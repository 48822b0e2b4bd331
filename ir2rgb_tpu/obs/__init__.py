from .html import HTMLPage
from .visualizer import Visualizer
from .writer import AsyncImageWriter

__all__ = ["Visualizer", "HTMLPage", "AsyncImageWriter"]
