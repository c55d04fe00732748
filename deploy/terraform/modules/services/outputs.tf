output "instance_group" {
  value = google_compute_instance_group_manager.app.instance_group
}

output "internal_ip" {
  description = "Internal DNS name the TPU workers use to reach NATS"
  value       = "${google_compute_instance_group_manager.app.base_instance_name}-0"
}
