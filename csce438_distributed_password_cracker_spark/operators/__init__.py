"""Composable df->df operators."""
