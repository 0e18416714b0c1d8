"""ASE utils shim."""
basestring = str
