output "db_password_secret_id" {
  value = google_secret_manager_secret.db_password.secret_id
}

output "jwt_secret_id" {
  value = google_secret_manager_secret.jwt.secret_id
}

output "llm_api_key_secret_id" {
  value = google_secret_manager_secret.llm_api_key.secret_id
}
