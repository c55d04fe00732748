"""lameness_tpu.parallel"""
