"""lameness_tpu.utils"""
