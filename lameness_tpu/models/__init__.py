"""lameness_tpu.models"""
