"""Simulation-parameter config (S5, reference main.py:536-555).

The reference loads a flat JSON template {"initial_budget": ...,
"investment_per_trade": ..., "max_trades": ""} into Tk variables;
defaults at main.py:38-40; an empty-string max_trades means "derive as
budget // per_trade" (main.py:374-375). Here: a frozen dataclass the
backtest operators take, with the same defaults and derivation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass(frozen=True)
class SimParams:
    initial_budget: float = 10_000.0
    investment_per_trade: float = 1_000.0
    max_trades: int | None = None  # None => budget // per_trade

    @property
    def effective_max_trades(self) -> int:
        if self.max_trades is not None:
            return int(self.max_trades)
        return int(self.initial_budget // self.investment_per_trade)

    @classmethod
    def from_json(cls, text_or_path: str) -> "SimParams":
        """Accepts a JSON string or a path to a JSON file."""
        try:
            raw = json.loads(text_or_path)
        except (json.JSONDecodeError, ValueError):
            with open(text_or_path) as f:
                raw = json.load(f)
        if not isinstance(raw, dict):
            raise ValueError("params template must be a JSON object")
        mt = raw.get("max_trades", "")
        max_trades = None if mt in ("", None) else int(mt)
        return cls(
            initial_budget=float(raw.get("initial_budget", 10_000.0)),
            investment_per_trade=float(
                raw.get("investment_per_trade", 1_000.0)),
            max_trades=max_trades,
        )
