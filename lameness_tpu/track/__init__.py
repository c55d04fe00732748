"""lameness_tpu.track"""
