"""CLIP in JAX (replacing the reference's openai/CLIP submodule,
SURVEY.md §2.2): ViT-B/32 visual + text transformer, BPE tokenizer,
torch-checkpoint converter."""

from .model import CLIP, CLIPConfig, VIT_B32
from .tokenizer import tokenize, SimpleTokenizer

__all__ = ["CLIP", "CLIPConfig", "VIT_B32", "tokenize", "SimpleTokenizer"]
