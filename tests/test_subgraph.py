"""Subgraph-counting family vs pure-Python oracles (FLASH subgraph apps)."""

from __future__ import annotations

from graphscope_spark.algorithms import (
    densest_subgraph_2approx,
    diamond_count,
    directed_triangle_census,
    rectangle_count,
    tailed_triangle_count,
    three_path_count,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def test_rectangle_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.rectangle_oracle(edges, vertices)
    assert rectangle_count(rand_graph).collect()[0]["rectangles"] == exp


def test_diamond_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.diamond_oracle(edges, vertices)
    assert diamond_count(rand_graph).collect()[0]["diamonds"] == exp


def test_three_path_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.three_path_oracle(edges, vertices)
    assert three_path_count(rand_graph).collect()[0]["paths3"] == exp


def test_tailed_triangle_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.tailed_triangle_oracle(edges, vertices)
    assert tailed_triangle_count(rand_graph).collect()[0]["tailed"] == exp


def test_densest_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    nv, ne, density = oracle.densest_oracle(edges, vertices)
    row = densest_subgraph_2approx(rand_graph).collect()[0]
    assert (row["nv"], row["ne"]) == (nv, ne)
    assert abs(row["density"] - density) < 1e-12


def test_directed_census_rand(rand_graph, rand_graph_data):
    _, edges = rand_graph_data
    exp = oracle.directed_census_oracle(edges)
    got = {r["kind"]: r["cnt"] for r in directed_triangle_census(rand_graph).collect()}
    assert got == exp


def test_directed_census_tiny(tiny_graph):
    exp = oracle.directed_census_oracle(TINY_EDGES)
    got = {r["kind"]: r["cnt"] for r in directed_triangle_census(tiny_graph).collect()}
    assert got == exp


def test_subgraph_counts_tiny(tiny_graph):
    exp_rect = oracle.rectangle_oracle(TINY_EDGES, TINY_VERTICES)
    exp_dia = oracle.diamond_oracle(TINY_EDGES, TINY_VERTICES)
    exp_p3 = oracle.three_path_oracle(TINY_EDGES, TINY_VERTICES)
    exp_tt = oracle.tailed_triangle_oracle(TINY_EDGES, TINY_VERTICES)
    assert rectangle_count(tiny_graph).collect()[0]["rectangles"] == exp_rect
    assert diamond_count(tiny_graph).collect()[0]["diamonds"] == exp_dia
    assert three_path_count(tiny_graph).collect()[0]["paths3"] == exp_p3
    assert tailed_triangle_count(tiny_graph).collect()[0]["tailed"] == exp_tt
