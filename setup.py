"""Shim for environments whose setuptools predates PEP 660 editable
installs (no `wheel` package): `pip install -e .` then takes the legacy
develop path. All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
