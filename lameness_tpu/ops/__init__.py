"""lameness_tpu.ops"""
