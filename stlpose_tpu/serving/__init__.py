from stlpose_tpu.serving.export import (export_pose_server,
                                        load_pose_server)

__all__ = ["export_pose_server", "load_pose_server"]
