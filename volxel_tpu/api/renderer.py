"""Renderer facade — fleshed out alongside the render core."""

from __future__ import annotations


class Renderer:  # placeholder; implemented with the render core
    pass
