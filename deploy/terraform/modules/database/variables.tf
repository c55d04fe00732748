variable "name_prefix" {
  type = string
}

variable "region" {
  type = string
}

variable "network_id" {
  type = string
}

variable "tier" {
  type = string
}

variable "password_name" {
  description = "Secret Manager id holding the db password"
  type        = string
}
