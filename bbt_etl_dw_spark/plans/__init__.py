"""Composable pipeline plans (star-schema assembly, medallion stages)."""
