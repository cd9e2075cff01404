from stlpose_tpu.serving.export import (export_detector_server,
                                        export_pose_server,
                                        load_pose_server,
                                        load_two_stage_server)

__all__ = ["export_detector_server", "export_pose_server",
           "load_pose_server", "load_two_stage_server"]
