"""Model core: JAX Llama/Qwen decoder (pure pytree functions), HF safetensors
weight loading, LoRA, projectors, and the encoder/hybrid retriever models."""
from .config import DecoderConfig
from .bert import BertConfig
from .encoder import EncoderModel, EncoderOutput
from .hybrid import HybridModel

__all__ = ["DecoderConfig", "BertConfig", "EncoderModel", "EncoderOutput", "HybridModel"]
