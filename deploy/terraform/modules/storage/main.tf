# GCS buckets (ref: terraform/modules/storage — S3 buckets for videos,
# models, results with lifecycle rules).

resource "google_storage_bucket" "videos" {
  name                        = "${var.project_id}-${var.name_prefix}-videos"
  location                    = var.location
  uniform_bucket_level_access = true
  force_destroy               = false

  lifecycle_rule {
    condition {
      age = var.raw_video_retention_days
    }
    action {
      type          = "SetStorageClass"
      storage_class = "NEARLINE"
    }
  }
}

resource "google_storage_bucket" "models" {
  name                        = "${var.project_id}-${var.name_prefix}-models"
  location                    = var.location
  uniform_bucket_level_access = true

  versioning {
    enabled = true # checkpoint rollback (orbax checkpoints + GBDT files)
  }
}

resource "google_storage_bucket" "results" {
  name                        = "${var.project_id}-${var.name_prefix}-results"
  location                    = var.location
  uniform_bucket_level_access = true
}
