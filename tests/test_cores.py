"""Core number / k-core vs NetworkX."""

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from tests.utils import karate, random_undirected, disconnected


def test_core_number_karate():
    G, Gnx = karate()
    df = ctpu.core_number(G)
    ref = nx.core_number(Gnx)
    got = dict(zip(df["vertex"], df["core_number"]))
    assert all(got[v] == ref[v] for v in ref)


def test_core_number_random():
    G, Gnx = random_undirected(n=100, m=400, seed=8)
    df = ctpu.core_number(G)
    ref = nx.core_number(Gnx)
    got = dict(zip(df["vertex"], df["core_number"]))
    assert all(got[v] == ref[v] for v in ref)


def test_core_number_disconnected():
    G, Gnx = disconnected()
    df = ctpu.core_number(G)
    ref = nx.core_number(Gnx)
    got = dict(zip(df["vertex"], df["core_number"]))
    assert all(got[v] == ref[v] for v in ref)


def test_k_core_subgraph():
    G, Gnx = karate()
    sub = ctpu.k_core(G, k=3)
    ref = nx.k_core(Gnx, k=3)
    el = sub.view_edge_list()
    got = {tuple(sorted(e)) for e in zip(el["src"], el["dst"])}
    assert got == {tuple(sorted(e)) for e in ref.edges()}
