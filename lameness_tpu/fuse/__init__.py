"""lameness_tpu.fuse"""
