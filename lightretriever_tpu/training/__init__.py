"""Training runtime: SPMD train loop, optimizer, GradCache-equivalent
microbatching, orbax checkpointing, and the domain-mixture data pipeline —
the TPU-native replacement of HF Trainer + accelerate + GradCache."""
