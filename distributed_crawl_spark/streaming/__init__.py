"""Micro-batch round driver and atomic checkpoint store."""
