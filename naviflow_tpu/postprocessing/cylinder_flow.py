"""Cylinder-flow validation — placeholder.

Parity marker with the reference's ``postprocessing/validation/
cylinder_flow.py``, which is likewise a docstring-only placeholder.
"""
