"""ASE io shim."""
