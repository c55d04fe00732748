# VPC + subnet + firewall + NAT (ref: terraform/modules/networking — VPC,
# public/private subnets, IGW/NAT gateways, security groups).

resource "google_compute_network" "vpc" {
  name                    = "${var.name_prefix}-vpc"
  auto_create_subnetworks = false
}

resource "google_compute_subnetwork" "main" {
  name                     = "${var.name_prefix}-subnet"
  network                  = google_compute_network.vpc.id
  region                   = var.region
  ip_cidr_range            = var.cidr
  private_ip_google_access = true
}

# internal traffic: app <-> TPU workers <-> wire servers (NATS 4222,
# Qdrant 6333, admin API 8000)
resource "google_compute_firewall" "internal" {
  name    = "${var.name_prefix}-internal"
  network = google_compute_network.vpc.name

  allow {
    protocol = "tcp"
    ports    = ["4222", "6333", "8000"]
  }

  source_ranges = [var.cidr]
}

# LB health checks + proxied traffic to the app group
resource "google_compute_firewall" "lb_health" {
  name    = "${var.name_prefix}-lb-health"
  network = google_compute_network.vpc.name

  allow {
    protocol = "tcp"
    ports    = ["8000"]
  }

  # Google LB + health-check ranges
  source_ranges = ["130.211.0.0/22", "35.191.0.0/16"]
  target_tags   = ["lameness-app"]
}

resource "google_compute_firewall" "ssh_iap" {
  name    = "${var.name_prefix}-ssh-iap"
  network = google_compute_network.vpc.name

  allow {
    protocol = "tcp"
    ports    = ["22"]
  }

  # IAP tunnel range only — no public SSH
  source_ranges = ["35.235.240.0/20"]
}

# egress for instances without public IPs (model pulls, image pulls)
resource "google_compute_router" "router" {
  name    = "${var.name_prefix}-router"
  network = google_compute_network.vpc.id
  region  = var.region
}

resource "google_compute_router_nat" "nat" {
  name                               = "${var.name_prefix}-nat"
  router                             = google_compute_router.router.name
  region                             = var.region
  nat_ip_allocate_option             = "AUTO_ONLY"
  source_subnetwork_ip_ranges_to_nat = "ALL_SUBNETWORKS_ALL_IP_RANGES"
}
