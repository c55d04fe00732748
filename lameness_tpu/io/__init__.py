"""lameness_tpu.io"""
