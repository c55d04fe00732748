variable "name_prefix" {
  type = string
}

variable "instance_group" {
  type = string
}

variable "health_path" {
  type = string
}

variable "enable_https" {
  type = bool
}

variable "domain" {
  type = string
}
