"""Offline data-preparation and analysis utilities (reference §2.7)."""
