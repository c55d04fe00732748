"""lameness_tpu.pipeline"""
