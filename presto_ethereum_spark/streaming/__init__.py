"""Structured Streaming surface: chain-head tailing + windowed event aggs."""
