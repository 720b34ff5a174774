"""bindyouravatar_tpu: TPU-native Bind-Your-Avatar framework (JAX/Pallas)."""

__version__ = "0.1.0"
