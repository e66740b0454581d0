"""Datasets + host-side decode (SURVEY C1, C3-C5) and the input feed."""
