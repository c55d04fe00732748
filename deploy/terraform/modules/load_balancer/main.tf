# Global HTTP(S) load balancer -> app instance group (ref:
# terraform/modules/load_balancer — ALB with target groups + health checks).

resource "google_compute_global_address" "lb" {
  name = "${var.name_prefix}-lb-ip"
}

resource "google_compute_health_check" "lb" {
  name = "${var.name_prefix}-lb-hc"

  http_health_check {
    port         = 8000
    request_path = var.health_path
  }
}

resource "google_compute_backend_service" "app" {
  name                  = "${var.name_prefix}-backend"
  protocol              = "HTTP"
  port_name             = "api"
  timeout_sec           = 120 # video uploads
  health_checks         = [google_compute_health_check.lb.id]
  load_balancing_scheme = "EXTERNAL_MANAGED"

  backend {
    group = var.instance_group
  }
}

resource "google_compute_url_map" "app" {
  name            = "${var.name_prefix}-urlmap"
  default_service = google_compute_backend_service.app.id
}

resource "google_compute_target_http_proxy" "app" {
  name    = "${var.name_prefix}-http-proxy"
  url_map = google_compute_url_map.app.id
}

resource "google_compute_global_forwarding_rule" "http" {
  name                  = "${var.name_prefix}-http"
  target                = google_compute_target_http_proxy.app.id
  ip_address            = google_compute_global_address.lb.address
  port_range            = "80"
  load_balancing_scheme = "EXTERNAL_MANAGED"
}

resource "google_compute_managed_ssl_certificate" "app" {
  count = var.enable_https ? 1 : 0
  name  = "${var.name_prefix}-cert"

  managed {
    domains = [var.domain]
  }
}

resource "google_compute_target_https_proxy" "app" {
  count            = var.enable_https ? 1 : 0
  name             = "${var.name_prefix}-https-proxy"
  url_map          = google_compute_url_map.app.id
  ssl_certificates = [google_compute_managed_ssl_certificate.app[0].id]
}

resource "google_compute_global_forwarding_rule" "https" {
  count                 = var.enable_https ? 1 : 0
  name                  = "${var.name_prefix}-https"
  target                = google_compute_target_https_proxy.app[0].id
  ip_address            = google_compute_global_address.lb.address
  port_range            = "443"
  load_balancing_scheme = "EXTERNAL_MANAGED"
}
