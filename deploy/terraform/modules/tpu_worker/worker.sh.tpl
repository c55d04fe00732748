#!/bin/bash
# TPU worker startup: run the engine worker against the shared bus.
# The engine warms its four staged jits on boot (pipeline/engine.py
# warmup) and then serves clip batches from the stream batcher.
set -e

docker pull "${image}"
docker rm -f lameness-worker || true
docker run -d --name lameness-worker --net=host --privileged \
  -v /dev:/dev \
  -e LAMENESS_MODELS_BUCKET=${models_bucket} \
  -e LAMENESS_NATS_URL=nats://${nats_host}:4222 \
  -e LAMENESS_WORKER_INDEX=${worker_index} \
  ${image} worker --warmup
