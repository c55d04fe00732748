"""lameness_tpu.serve"""
