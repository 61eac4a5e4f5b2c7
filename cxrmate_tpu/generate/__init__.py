from cxrmate_tpu.generate.decode import GenerationConfig, generate

__all__ = ["GenerationConfig", "generate"]
