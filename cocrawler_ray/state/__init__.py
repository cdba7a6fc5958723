"""Stateful partition classes (frontier / seen / robots).

Each is a plain Python class (unit-testable without Ray) that the pipeline
wraps with ``ray.remote`` into K-partition actor pools. Partitioning:
frontier + robots by ``hash(host) % K`` (politeness locality), seen by
``hash(surt) % K`` (north_rule).
"""

from cocrawler_ray.state.seen import SeenPartition
from cocrawler_ray.state.frontier import FrontierPartition
from cocrawler_ray.state.robots_actor import RobotsPartition

__all__ = ["SeenPartition", "FrontierPartition", "RobotsPartition"]
