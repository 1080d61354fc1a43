package graft.tools

import graft.corpus.Images

/** Dev calibration: multithreaded render+encode+decode+phash throughput,
  * with the ImageIO stream cache on vs off — isolates codec scaling from
  * Spark and from host noise. Usage: CodecCal [pages threads img].
  */
object CodecCal {
  def run(pages: Int, threads: Int, img: Int): Double = {
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val tasks = (0 until pages).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val im = Images.synth(i.toLong, img, img)
          val bytes = if (i % 3 == 0) Images.encodeJpeg(im) else Images.encodePng(im)
          val ph = Images.phashOfBytes(bytes)
          if (ph == 42L) println("!") // keep the work observable
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    pages / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val pages = args.lift(0).map(_.toInt).getOrElse(2000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val img = args.lift(2).map(_.toInt).getOrElse(224)
    run(200, threads, img) // warmup
    javax.imageio.ImageIO.setUseCache(false)
    println(f"cache=off pages/s = ${run(pages, threads, img)}%.1f (threads=$threads)")
    javax.imageio.ImageIO.setUseCache(true)
    println(f"cache=on  pages/s = ${run(pages, threads, img)}%.1f (threads=$threads)")
    javax.imageio.ImageIO.setUseCache(false)
    println(f"cache=off pages/s = ${run(pages, threads, img)}%.1f (threads=$threads)")
    (1 :: 8 :: Nil).foreach { th =>
      println(f"cache=off threads=$th pages/s = ${run(pages / 4, th, img)}%.1f")
    }
  }
}
