"""lameness_tpu.core"""
