"""Multimodal binary-column processing (opaque image/audio/video payloads)."""
