# TPU-native deployment for the lameness detection platform.
#
# GCP analog of the reference's AWS stack (/root/reference/terraform/main.tf):
#   networking     -> VPC + subnet + firewall + NAT   (ref: modules/networking)
#   storage        -> GCS buckets                     (ref: modules/storage, S3)
#   database       -> Cloud SQL Postgres              (ref: modules/database, RDS)
#   secrets        -> Secret Manager                  (ref: modules/secrets)
#   services       -> app VM group (admin API + wire  (ref: modules/ecs —
#                     servers via systemd/compose)     ECS services)
#   tpu_worker     -> TPU v5e VM(s) running the       (ref: modules/gpu_worker —
#                     inference engine                 g4dn GPU workers)
#   load_balancer  -> global HTTP LB -> app group     (ref: modules/load_balancer)

terraform {
  required_version = ">= 1.0"

  required_providers {
    google = {
      source  = "hashicorp/google"
      version = "~> 5.0"
    }
  }

  # Uncomment for remote state (analog of the reference's S3 backend block)
  # backend "gcs" {
  #   bucket = "lameness-terraform-state"
  #   prefix = "state"
  # }
}

provider "google" {
  project = var.project_id
  region  = var.region
  zone    = var.zone

  default_labels = {
    project     = var.project_name
    environment = var.environment
    managed_by  = "terraform"
  }
}

locals {
  name_prefix = "${var.project_name}-${var.environment}"
}

module "networking" {
  source      = "./modules/networking"
  name_prefix = local.name_prefix
  region      = var.region
}

module "storage" {
  source      = "./modules/storage"
  name_prefix = local.name_prefix
  project_id  = var.project_id
  location    = var.region
}

module "secrets" {
  source      = "./modules/secrets"
  name_prefix = local.name_prefix
}

module "database" {
  source        = "./modules/database"
  name_prefix   = local.name_prefix
  region        = var.region
  network_id    = module.networking.network_id
  tier          = var.db_tier
  password_name = module.secrets.db_password_secret_id
}

module "services" {
  source         = "./modules/services"
  name_prefix    = local.name_prefix
  zone           = var.zone
  subnet_id      = module.networking.subnet_id
  machine_type   = var.app_machine_type
  instance_count = var.app_instance_count
  image          = var.app_container_image
  data_bucket    = module.storage.videos_bucket
  models_bucket  = module.storage.models_bucket
  db_connection  = module.database.connection_name
  jwt_secret_id  = module.secrets.jwt_secret_id
}

module "tpu_worker" {
  source           = "./modules/tpu_worker"
  name_prefix      = local.name_prefix
  zone             = var.zone
  accelerator_type = var.tpu_accelerator_type
  runtime_version  = var.tpu_runtime_version
  worker_count     = var.tpu_worker_count
  preemptible      = var.tpu_preemptible
  subnet_id        = module.networking.subnet_id
  image            = var.app_container_image
  models_bucket    = module.storage.models_bucket
  nats_host        = module.services.internal_ip
}

module "load_balancer" {
  source          = "./modules/load_balancer"
  name_prefix     = local.name_prefix
  instance_group  = module.services.instance_group
  health_path     = "/api/health/overview"
  enable_https    = var.enable_https
  domain          = var.domain
}
