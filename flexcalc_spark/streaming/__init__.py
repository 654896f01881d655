"""Structured Streaming modules — populated in the streaming phase."""
