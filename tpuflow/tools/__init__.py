"""User-facing tools: CLI, pipeline orchestrator, visualizer, correction, GUI."""
