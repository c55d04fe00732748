"""lameness_tpu — TPU-native (JAX/XLA/Pallas/pjit) dairy-cow lameness platform.

A ground-up rebuild of the capabilities of the reference
`vision-sam3-yolo-lameless` microservice platform as a single
device-resident inference engine plus a thin host orchestration shell.
See SURVEY.md at the repo root for the structural analysis the design
follows, and BASELINE.md for performance targets.

Layout (maps onto the reference layer map, SURVEY.md §1):

- ``core``      typed config tree, ClipBatch pytrees, dtype policy
- ``parallel``  device mesh + sharding specs (pjit / shard_map)
- ``ops``       device kernels: fused preprocess, batched NMS, flash attention
- ``models``    flax modules: YOLO, SAM (ViT + mask decoder), DINO ViT,
                pose head, TCN, gait transformer, GraphGPS, Graphormer
- ``video``     host decode + clip curation (canonical 5 s clip)
- ``track``     ByteTrack: vmapped Kalman, LAPJV assignment, Re-ID matcher
- ``graph``     dense graph builders: kNN, SPD min-plus, positional encodings
- ``ml``        tabular GBDT ensemble (host, bit-stable)
- ``fuse``      gating rules + uncertainty-weighted fusion
- ``hitl``      Elo, David's score, Dawid-Skene, GLAD, rater reliability
- ``xai``       exact Shapley explanations + LLM explanation text
- ``io``        result-JSON schemas/writers, vector store, DB, message bus
- ``serve``     admin REST/WS surface + pipeline driver
- ``pipeline``  the fused, jitted end-to-end engine
"""

__version__ = "0.1.0"
