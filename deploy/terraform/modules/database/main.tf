# Cloud SQL Postgres (ref: terraform/modules/database — RDS Postgres for
# the admin backend; io/db.py renders the same 14-table schema and
# documents the driver swap from its SQLite default).

resource "google_compute_global_address" "private_ip" {
  name          = "${var.name_prefix}-db-ip"
  purpose       = "VPC_PEERING"
  address_type  = "INTERNAL"
  prefix_length = 16
  network       = var.network_id
}

resource "google_service_networking_connection" "peering" {
  network                 = var.network_id
  service                 = "servicenetworking.googleapis.com"
  reserved_peering_ranges = [google_compute_global_address.private_ip.name]
}

resource "google_sql_database_instance" "main" {
  name             = "${var.name_prefix}-db"
  database_version = "POSTGRES_15"
  region           = var.region

  depends_on = [google_service_networking_connection.peering]

  settings {
    tier = var.tier

    ip_configuration {
      ipv4_enabled    = false
      private_network = var.network_id
    }

    backup_configuration {
      enabled = true
    }
  }

  deletion_protection = true
}

resource "google_sql_database" "lameness" {
  name     = "lameness"
  instance = google_sql_database_instance.main.name
}

resource "google_sql_user" "app" {
  name     = "lameness"
  instance = google_sql_database_instance.main.name
  password = var.password_name # resolved from Secret Manager at deploy time
}
