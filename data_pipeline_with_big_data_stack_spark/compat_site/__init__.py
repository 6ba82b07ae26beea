"""PYTHONPATH shim directory for python workers (see sitecustomize.py)."""
