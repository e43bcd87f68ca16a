"""setup.py shim: enables legacy editable installs (pip --no-use-pep517
or environments whose setuptools predates PEP 660 wheel-less editables).
All metadata lives in pyproject.toml."""
from setuptools import setup

setup()
