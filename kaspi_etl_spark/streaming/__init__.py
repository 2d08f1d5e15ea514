"""Streaming operators — price watch with stateful bot detection."""
