output "videos_bucket" {
  value = google_storage_bucket.videos.name
}

output "models_bucket" {
  value = google_storage_bucket.models.name
}

output "results_bucket" {
  value = google_storage_bucket.results.name
}
