from cxrmate_tpu.tokenizer.bpe import ByteLevelBPETokenizer
from cxrmate_tpu.tokenizer.train import train_bpe

__all__ = ["ByteLevelBPETokenizer", "train_bpe"]
