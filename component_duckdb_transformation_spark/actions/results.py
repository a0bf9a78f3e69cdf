"""Sync-action result types (the reference uses
``keboola.component.sync_actions.ValidationResult``/``MessageType``;
these are the engine-local equivalents)."""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class MessageType(str, Enum):
    SUCCESS = "success"
    WARNING = "warning"
    DANGER = "danger"


@dataclass
class ValidationResult:
    message: str
    type: MessageType = MessageType.SUCCESS
