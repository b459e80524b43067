"""Configuration base class.

Reference parity: ``src/openpifpaf/configurable.py:~10`` — the reference
stores all configuration in *class attributes* mutated by ``cli()`` /
``configure()`` classmethods.  We reproduce the same user-facing pattern
(flag names are part of the capability surface) but constructors also accept
explicit keyword overrides so library code can avoid mutable global state.
"""

from __future__ import annotations


class Configurable:
    """Base for classes configured via class attributes.

    Subclasses declare configuration as class attributes.  The constructor
    accepts keyword overrides for any declared attribute and raises on
    unknown names (same contract as the reference Configurable).

    Subclasses may additionally define::

        @classmethod
        def cli(cls, parser):        # add an argparse group
        @classmethod
        def configure(cls, args):    # copy parsed args into class attrs
    """

    def __init__(self, **kwargs):
        for key, value in kwargs.items():
            if not hasattr(self.__class__, key):
                raise ValueError(
                    f'{self.__class__.__name__} has no configuration '
                    f'attribute {key!r}')
            setattr(self, key, value)

    @classmethod
    def cli(cls, parser):  # pragma: no cover - default no-op
        """Add this class's options to an argparse parser."""

    @classmethod
    def configure(cls, args):  # pragma: no cover - default no-op
        """Apply parsed argparse values to class attributes."""
