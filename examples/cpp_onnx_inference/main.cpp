// Native C++ ONNX inference example for drone_yolo_tpu artifacts.
//
// Capability parity with the reference's OpenCV-DNN C++ example app
// (examples/YOLOv8-CPP-Inference/inference.cpp: readNetFromONNX + letterbox +
// (4+nc, A) head parse + NMSBoxes). The artifact here is the ONNX emitted by
// `yolo-tpu export format=onnx` — the emitter targets legacy importers
// (verified against OpenCV 4.6), so this builds against the system OpenCV
// with no ONNX Runtime dependency.
//
// Usage: ./dyt_onnx_infer <model.onnx> <image> [conf=0.25] [iou=0.7]
//
// Class names are read from the exporter's <model>.onnx.json sidecar when
// present (a tiny ad-hoc scan — the sidecar is machine-written flat JSON).

#include <opencv2/dnn.hpp>
#include <opencv2/opencv.hpp>

#include <cstdio>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

// Aspect-preserving resize + center pad to (size, size), gray 114 border
// (reference LetterBox semantics, scaleup=False).
static cv::Mat letterbox(const cv::Mat& img, int size, float& ratio, float& dw, float& dh) {
  ratio = std::min(size / (float)img.cols, size / (float)img.rows);
  ratio = std::min(ratio, 1.0f);
  int nw = (int)std::round(img.cols * ratio), nh = (int)std::round(img.rows * ratio);
  cv::Mat resized;
  cv::resize(img, resized, cv::Size(nw, nh), 0, 0, cv::INTER_LINEAR);
  dw = (size - nw) / 2.0f;
  dh = (size - nh) / 2.0f;
  int top = (int)std::round(dh - 0.1f), bottom = (int)std::round(dh + 0.1f);
  int left = (int)std::round(dw - 0.1f), right = (int)std::round(dw + 0.1f);
  cv::Mat out;
  cv::copyMakeBorder(resized, out, top, bottom, left, right, cv::BORDER_CONSTANT,
                     cv::Scalar(114, 114, 114));
  return out;
}

// Minimal scan of the exporter sidecar for "names": {"0": "person", ...}
// and "input": [B, C, H, W]. Not a general JSON parser.
static void read_sidecar(const std::string& onnx_path, std::map<int, std::string>& names,
                         int& imgsz) {
  std::ifstream f(onnx_path + ".json");
  if (!f) return;
  std::stringstream ss;
  ss << f.rdbuf();
  const std::string s = ss.str();
  size_t in = s.find("\"input\"");
  if (in != std::string::npos) {
    int dims[4] = {0, 0, 0, 0};
    if (std::sscanf(s.c_str() + s.find('[', in), "[ %d , %d , %d , %d", &dims[0], &dims[1],
                    &dims[2], &dims[3]) == 4)
      imgsz = dims[3];
  }
  size_t np = s.find("\"names\"");
  if (np == std::string::npos) return;
  size_t p = s.find('{', np);
  size_t end = s.find('}', p);
  while (p < end) {
    size_t k1 = s.find('"', p + 1);
    if (k1 == std::string::npos || k1 > end) break;
    size_t k2 = s.find('"', k1 + 1);
    size_t v1 = s.find('"', s.find(':', k2));
    size_t v2 = s.find('"', v1 + 1);
    if (v2 == std::string::npos || v2 > end) break;
    names[std::atoi(s.substr(k1 + 1, k2 - k1 - 1).c_str())] = s.substr(v1 + 1, v2 - v1 - 1);
    p = v2 + 1;
  }
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <model.onnx> <image> [conf] [iou]\n", argv[0]);
    return 2;
  }
  const std::string model_path = argv[1];
  const char* image_path = argv[2];
  const float conf_thres = argc > 3 ? (float)std::atof(argv[3]) : 0.25f;
  const float iou_thres = argc > 4 ? (float)std::atof(argv[4]) : 0.7f;

  std::map<int, std::string> names;
  int imgsz = 640;
  read_sidecar(model_path, names, imgsz);

  cv::dnn::Net net = cv::dnn::readNetFromONNX(model_path);

  cv::Mat bgr = cv::imread(image_path);
  if (bgr.empty()) {
    std::fprintf(stderr, "cannot read %s\n", image_path);
    return 1;
  }
  float ratio, dw, dh;
  cv::Mat boxed = letterbox(bgr, imgsz, ratio, dw, dh);

  // BGR -> RGB, /255, NCHW (the artifact takes normalized RGB like the live model)
  cv::Mat blob = cv::dnn::blobFromImage(boxed, 1.0 / 255.0, cv::Size(imgsz, imgsz), cv::Scalar(),
                                        /*swapRB=*/true, /*crop=*/false);
  net.setInput(blob);
  cv::Mat out = net.forward();  // (1, 4+nc, A) — xywh (letterboxed px) + class scores

  const int no = out.size[1];
  const int A = out.size[2];
  const int nc = no - 4;
  cv::Mat pred(no, A, CV_32F, out.ptr<float>());

  std::vector<cv::Rect> boxes;
  std::vector<float> scores;
  std::vector<int> classes;
  for (int a = 0; a < A; ++a) {
    int best = 0;
    float sc = 0.0f;
    for (int c = 0; c < nc; ++c) {
      float v = pred.at<float>(4 + c, a);
      if (v > sc) sc = v, best = c;
    }
    if (sc < conf_thres) continue;
    float cx = pred.at<float>(0, a), cy = pred.at<float>(1, a);
    float w = pred.at<float>(2, a), h = pred.at<float>(3, a);
    boxes.emplace_back((int)std::round(cx - w / 2), (int)std::round(cy - h / 2),
                       (int)std::round(w), (int)std::round(h));
    scores.push_back(sc);
    classes.push_back(best);
  }

  std::vector<int> keep;
  cv::dnn::NMSBoxes(boxes, scores, conf_thres, iou_thres, keep);

  for (size_t k = 0; k < keep.size(); ++k) {
    int i = keep[k];
    float x1 = (boxes[i].x - dw) / ratio, y1 = (boxes[i].y - dh) / ratio;
    float x2 = (boxes[i].x + boxes[i].width - dw) / ratio;
    float y2 = (boxes[i].y + boxes[i].height - dh) / ratio;
    const std::string& name =
        names.count(classes[i]) ? names[classes[i]] : std::to_string(classes[i]);
    std::printf("det %zu: cls=%s conf=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n", k, name.c_str(),
                scores[i], x1, y1, x2, y2);
    cv::rectangle(bgr, cv::Point((int)x1, (int)y1), cv::Point((int)x2, (int)y2),
                  cv::Scalar(0, 255, 0), 2);
    cv::putText(bgr, name, cv::Point((int)x1, (int)y1 - 4), cv::FONT_HERSHEY_SIMPLEX, 0.5,
                cv::Scalar(0, 255, 0), 1);
  }
  std::printf("detections: %zu\n", keep.size());
  cv::imwrite("cpp_onnx_out.jpg", bgr);
  return 0;
}
