"""Runners: headless benchmark CLI, tiled PNG dump, interactive viewer."""
