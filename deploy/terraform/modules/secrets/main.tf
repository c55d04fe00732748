# Secret Manager (ref: terraform/modules/secrets — Secrets Manager entries
# for db password, jwt secret, api keys).

resource "random_password" "db" {
  length  = 24
  special = false
}

resource "random_password" "jwt" {
  length  = 48
  special = false
}

resource "google_secret_manager_secret" "db_password" {
  secret_id = "${var.name_prefix}-db-password"

  replication {
    auto {}
  }
}

resource "google_secret_manager_secret_version" "db_password" {
  secret      = google_secret_manager_secret.db_password.id
  secret_data = random_password.db.result
}

resource "google_secret_manager_secret" "jwt" {
  secret_id = "${var.name_prefix}-jwt-secret"

  replication {
    auto {}
  }
}

resource "google_secret_manager_secret_version" "jwt" {
  secret      = google_secret_manager_secret.jwt.id
  secret_data = random_password.jwt.result
}

# optional external-LLM provider key (xai/llm.py provider fallback)
resource "google_secret_manager_secret" "llm_api_key" {
  secret_id = "${var.name_prefix}-llm-api-key"

  replication {
    auto {}
  }
}
