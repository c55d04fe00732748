variable "name_prefix" {
  type = string
}

variable "project_id" {
  type = string
}

variable "location" {
  type = string
}

variable "raw_video_retention_days" {
  type    = number
  default = 90
}
