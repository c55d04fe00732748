# TPU inference workers (ref: terraform/modules/gpu_worker — g4dn GPU
# instances running the CUDA containers; here: TPU v5e VMs running the
# jax engine, preemptible option mirroring the reference's spot workers).

resource "google_tpu_v2_vm" "worker" {
  count            = var.worker_count
  name             = "${var.name_prefix}-tpu-${count.index}"
  zone             = var.zone
  accelerator_type = var.accelerator_type
  runtime_version  = var.runtime_version

  network_config {
    subnetwork         = var.subnet_id
    enable_external_ips = false
  }

  scheduling_config {
    preemptible = var.preemptible
  }

  metadata = {
    startup-script = templatefile("${path.module}/worker.sh.tpl", {
      image         = var.image
      models_bucket = var.models_bucket
      nats_host     = var.nats_host
      worker_index  = count.index
    })
  }

  labels = {
    role = "tpu-inference"
  }
}
