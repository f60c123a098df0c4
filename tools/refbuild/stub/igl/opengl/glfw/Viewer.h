// Headless stub of igl::opengl::glfw::Viewer — enough surface for DOT's
// offline mode (mode 100 never draws; GLFW is unavailable on this host).
#pragma once
#include <Eigen/Core>
#include <igl/colormap.h>
#include <igl/barycenter.h>
#include <Eigen/Geometry>
#include <functional>
namespace igl { namespace opengl {
struct StubData {
  Eigen::MatrixXd V, V_uv;
  Eigen::MatrixXi F;
  double point_size = 1.0;
  bool show_lines = false, show_overlay = true, show_texture = false;
  void clear() { V.resize(0, 3); F.resize(0, 3); }
  void set_mesh(const Eigen::MatrixXd& v, const Eigen::MatrixXi& f) { V = v; F = f; }
  void set_colors(const Eigen::MatrixXd&) {}
  void set_points(const Eigen::MatrixXd&, const Eigen::MatrixXd&) {}
  void add_points(const Eigen::MatrixXd&, const Eigen::MatrixXd&) {}
  void compute_normals() {}
  void set_face_based(bool) {}
};
struct StubCore {
  bool is_animating = false, orthographic = false;
  double animation_max_fps = 30.0, lighting_factor = 1.0, camera_zoom = 1.0;
  Eigen::Vector4f viewport = Eigen::Vector4f(0, 0, 1280, 800);
  Eigen::Vector4f background_color = Eigen::Vector4f(1, 1, 1, 1);
  Eigen::Quaternionf trackball_angle = Eigen::Quaternionf::Identity();
  void align_camera_center(const Eigen::MatrixXd&, const Eigen::MatrixXi&) {}
  template <class... A> void draw_buffer(A&&...) {}
};
namespace glfw {
class Viewer {
 public:
  StubCore core;
  StubData data_;
  StubData& data() { return data_; }
  std::function<bool(Viewer&)> callback_pre_draw, callback_post_draw;
  std::function<bool(Viewer&, unsigned char, int)> callback_key_down;
  int launch(bool = true, bool = false) {
    // offline mode never calls launch; if it is called, do nothing
    return 0;
  }
};
}}}  // namespace igl::opengl::glfw
