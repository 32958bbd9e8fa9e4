"""Model zoo: pure-functional JAX forwards over flat torch-keyed params."""
