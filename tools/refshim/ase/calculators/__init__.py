"""ASE calculators shim."""
