# App instance group (ref: terraform/modules/ecs — the 12+ ECS services).
#
# The TPU rebuild collapses the reference's microservice fleet into one
# process (pipeline/engine.py + serve/app.py) plus two first-party wire
# servers (io/nats_wire.py broker, io/qdrant_wire.py vector server), so
# the ECS task-definition matrix maps to a single instance template whose
# startup script runs deploy/docker-compose.yml via systemd
# (deploy/lameness.service).

resource "google_service_account" "app" {
  account_id   = "${var.name_prefix}-app"
  display_name = "lameness app"
}

resource "google_compute_instance_template" "app" {
  name_prefix  = "${var.name_prefix}-app-"
  machine_type = var.machine_type

  disk {
    source_image = "projects/cos-cloud/global/images/family/cos-stable"
    auto_delete  = true
    boot         = true
    disk_size_gb = 100
  }

  network_interface {
    subnetwork = var.subnet_id
    # no public IP: egress via Cloud NAT, ingress via the LB
  }

  service_account {
    email  = google_service_account.app.email
    scopes = ["cloud-platform"]
  }

  tags = ["lameness-app"]

  metadata = {
    startup-script = templatefile("${path.module}/startup.sh.tpl", {
      image         = var.image
      data_bucket   = var.data_bucket
      models_bucket = var.models_bucket
      db_connection = var.db_connection
      jwt_secret_id = var.jwt_secret_id
    })
  }

  lifecycle {
    create_before_destroy = true
  }
}

resource "google_compute_instance_group_manager" "app" {
  name               = "${var.name_prefix}-app-mig"
  zone               = var.zone
  base_instance_name = "${var.name_prefix}-app"
  target_size        = var.instance_count

  version {
    instance_template = google_compute_instance_template.app.id
  }

  named_port {
    name = "api"
    port = 8000
  }

  auto_healing_policies {
    health_check      = google_compute_health_check.app.id
    initial_delay_sec = 300
  }
}

resource "google_compute_health_check" "app" {
  name = "${var.name_prefix}-app-hc"

  http_health_check {
    port         = 8000
    request_path = "/api/health/overview"
  }

  check_interval_sec  = 15
  timeout_sec         = 5
  unhealthy_threshold = 3
}
