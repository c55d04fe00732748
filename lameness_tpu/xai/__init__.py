"""lameness_tpu.xai"""
