"""lameness_tpu.video"""
