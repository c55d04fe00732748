variable "name_prefix" {
  type = string
}

variable "zone" {
  type = string
}

variable "accelerator_type" {
  type = string
}

variable "runtime_version" {
  type = string
}

variable "worker_count" {
  type = number
}

variable "preemptible" {
  type = bool
}

variable "subnet_id" {
  type = string
}

variable "image" {
  type = string
}

variable "models_bucket" {
  type = string
}

variable "nats_host" {
  type = string
}
