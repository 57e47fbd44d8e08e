# SPDX-License-Identifier: CECILL-2.1
"""Reporting: Markdown logbook summaries and the barc4dip-speckles CLI."""
from .markdown import logbook_report, register_formatter

__all__ = ["logbook_report", "register_formatter"]
