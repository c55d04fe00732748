"""lameness_tpu.ml"""
