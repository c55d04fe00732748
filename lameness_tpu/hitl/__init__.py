"""lameness_tpu.hitl"""
