from .manifest import ShardManifest, committed_shards, write_manifest, shard_output_dir

__all__ = ["ShardManifest", "committed_shards", "write_manifest", "shard_output_dir"]
