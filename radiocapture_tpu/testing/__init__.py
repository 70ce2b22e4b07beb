"""Synthetic signal generators and fake infrastructure for tests.

The reference has no test suite (SURVEY.md §4); this package provides the
missing fixture layer: numpy modulators that synthesize on-air-accurate
IQ for every protocol path (C4FM P25, 2-FSK EDACS/Motorola, NBFM voice),
plus in-process fakes for the event bus and channelizer so call-management
logic is testable without RF or brokers.
"""
