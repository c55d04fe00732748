# Top-level outputs (analog of /root/reference/terraform/outputs.tf).

output "load_balancer_ip" {
  description = "Public address of the admin interface / API"
  value       = module.load_balancer.address
}

output "videos_bucket" {
  description = "GCS bucket holding uploaded videos"
  value       = module.storage.videos_bucket
}

output "models_bucket" {
  description = "GCS bucket holding model checkpoints"
  value       = module.storage.models_bucket
}

output "db_connection_name" {
  description = "Cloud SQL connection string for the admin backend"
  value       = module.database.connection_name
}

output "tpu_worker_names" {
  description = "Provisioned TPU inference workers"
  value       = module.tpu_worker.worker_names
}
