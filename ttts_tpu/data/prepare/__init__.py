"""Offline data-preparation CLIs (reference ttts/prepare/ + ttts/script/)."""
