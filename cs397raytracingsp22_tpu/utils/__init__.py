"""Math, sampling, and asset-I/O foundation (reference layer L1)."""
