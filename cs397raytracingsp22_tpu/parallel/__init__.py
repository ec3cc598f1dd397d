"""Device-mesh parallelism: pixel/sample sharding via shard_map."""
