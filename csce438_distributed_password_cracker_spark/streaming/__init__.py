"""Structured Streaming surface (SURVEY.md §2.9): the reference's always-on
message-driven behavior re-expressed as readStream → transform → writeStream."""
