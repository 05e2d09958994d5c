"""Composable DataFrame operators (the engine's core surface)."""
