from .html import HTMLPage
from .visualizer import Visualizer

__all__ = ["Visualizer", "HTMLPage"]
