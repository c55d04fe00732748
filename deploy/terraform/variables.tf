# Top-level inputs (analog of /root/reference/terraform/variables.tf).

variable "project_id" {
  description = "GCP project id"
  type        = string
}

variable "project_name" {
  description = "Resource name prefix"
  type        = string
  default     = "lameness"
}

variable "environment" {
  description = "dev / staging / prod"
  type        = string
  default     = "prod"
}

variable "region" {
  description = "GCP region (must offer TPU v5e)"
  type        = string
  default     = "us-central1"
}

variable "zone" {
  description = "Zone for the TPU VM and app instances"
  type        = string
  default     = "us-central1-a"
}

variable "app_machine_type" {
  description = "Machine type for the admin/app instance group"
  type        = string
  default     = "e2-standard-4"
}

variable "app_instance_count" {
  description = "App (admin API + wire servers) instance count"
  type        = number
  default     = 1
}

variable "app_container_image" {
  description = "Container image for the platform (built from /Dockerfile)"
  type        = string
  default     = "gcr.io/PROJECT/lameness-tpu:latest"
}

variable "tpu_accelerator_type" {
  description = "TPU accelerator (the bench targets v5e; v5litepod-4 = v5e-4)"
  type        = string
  default     = "v5litepod-4"
}

variable "tpu_runtime_version" {
  description = "TPU VM runtime"
  type        = string
  default     = "v2-alpha-tpuv5-lite"
}

variable "tpu_worker_count" {
  description = "Number of TPU inference workers (ref: gpu_worker count)"
  type        = number
  default     = 1
}

variable "tpu_preemptible" {
  description = "Use preemptible TPU capacity (ref: spot GPU workers)"
  type        = bool
  default     = false
}

variable "db_tier" {
  description = "Cloud SQL tier (ref RDS db.t3.medium analog)"
  type        = string
  default     = "db-custom-2-4096"
}

variable "enable_https" {
  description = "Provision a managed certificate + HTTPS proxy"
  type        = bool
  default     = false
}

variable "domain" {
  description = "Domain for the managed certificate (when enable_https)"
  type        = string
  default     = ""
}
