"""lameness_tpu.bench"""
