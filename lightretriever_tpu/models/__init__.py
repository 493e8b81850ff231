"""Model core: JAX Llama/Qwen decoder (pure pytree functions), HF safetensors
weight loading, LoRA, projectors, and the encoder/hybrid retriever models."""
