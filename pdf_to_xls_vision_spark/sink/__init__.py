"""Checkpointed, resumable output sink."""
