"""Interactive demo layer (reference: show_demo/)."""

from where2edit_tpu.demo.api import EditSession, one_text_edit

__all__ = ["EditSession", "one_text_edit"]
