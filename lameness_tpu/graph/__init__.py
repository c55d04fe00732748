"""lameness_tpu.graph"""
