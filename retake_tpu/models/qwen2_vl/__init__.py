from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
