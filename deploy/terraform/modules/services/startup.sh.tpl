#!/bin/bash
# App VM startup: pull the platform image and run it under systemd
# (container-optimized OS; analog of the reference's ECS task launch).
set -e

docker pull "${image}"

cat > /etc/systemd/system/lameness.service <<'UNIT'
[Unit]
Description=lameness platform (admin API + engine + wire servers)
After=docker.service
Requires=docker.service

[Service]
Restart=always
ExecStartPre=-/usr/bin/docker rm -f lameness
ExecStart=/usr/bin/docker run --name lameness --net=host \
  -e LAMENESS_DATA_BUCKET=${data_bucket} \
  -e LAMENESS_MODELS_BUCKET=${models_bucket} \
  -e LAMENESS_DB=${db_connection} \
  -e LAMENESS_JWT_SECRET_ID=${jwt_secret_id} \
  ${image} serve --port 8000
ExecStop=/usr/bin/docker stop lameness

[Install]
WantedBy=multi-user.target
UNIT

systemctl daemon-reload
systemctl enable --now lameness.service
