"""Test-only shim infrastructure for executing the reference package."""
