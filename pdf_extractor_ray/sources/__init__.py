"""Dataset sources and sinks."""

from .pages import read_pages, synthesize_pages_dataset
