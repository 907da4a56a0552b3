"""Plans — snapshot publication, plan inspection, cache tiers.

The generalizations of the reference's buffer-management ideas:
C1 (tiered memory) → cache.py; C3 (atomic double-buffer swap) →
snapshot.py.
"""
