output "worker_names" {
  value = google_tpu_v2_vm.worker[*].name
}
