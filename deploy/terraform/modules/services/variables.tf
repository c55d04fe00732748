variable "name_prefix" {
  type = string
}

variable "zone" {
  type = string
}

variable "subnet_id" {
  type = string
}

variable "machine_type" {
  type = string
}

variable "instance_count" {
  type = number
}

variable "image" {
  type = string
}

variable "data_bucket" {
  type = string
}

variable "models_bucket" {
  type = string
}

variable "db_connection" {
  type = string
}

variable "jwt_secret_id" {
  type = string
}
