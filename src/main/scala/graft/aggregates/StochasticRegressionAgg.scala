package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** stochasticLinearRegression / stochasticLogisticRegression (reference
  * AggregateFunctionMLMethod.cpp:111 registration, defaults lr=1.0,
  * l2=0.5, batch=15, updater='Adam' at :58-63): incremental linear-model
  * training inside the aggregate.
  *
  * Exact algorithm mirror:
  *   - LinearRegression::compute (:563): d = 2(target − bias − w·x);
  *     grad[bias] += d; grad[i] += d·x_i − 2·l2·w_i.
  *   - LogisticRegression::compute (:487): e = exp(target·(bias + w·x));
  *     grad[bias] += target/(e+1); grad[i] += target·x_i/(e+1) − 2·l2·w_i.
  *   - Updaters SGD/Momentum(α=0.1)/Nesterov(α=0.9, gradient at
  *     shifted weights)/Adam(β1=0.9, β2=0.999, ε=1e-6, bias-corrected)
  *     apply once per full mini-batch (LinearModelData::add :217).
  *   - merge (:196): flush own batch, then blend weights with
  *     frac = iter²/(iter² + rhsIter²) — the reference's squared-mean
  *     stabilization — and sum iteration counts. Like the reference, the
  *     right side's trailing partial batch is dropped and a final
  *     trailing sub-batch never updates weights.
  *
  * Mini-batch SGD is arrival-order-dependent BY DESIGN (in the reference
  * too — whatever block order the pipeline delivers); results are exact
  * on a single ordered stream (the unit-traced path) and
  * partition-layout-dependent when distributed, so the gate query is
  * rows-only. Output = returnWeights (:156): array [w_0..w_{k−1}, bias].
  */
case class StochasticRegressionAgg(
    children: Seq[Expression], // target +: features
    isLogistic: Boolean,
    learningRate: Double,
    l2: Double,
    batchCapacity: Long,
    updaterName: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StochasticRegressionAgg.Model] {

  require(children.size >= 2,
    "stochastic regression needs a target and at least one feature")
  require(Seq("SGD", "Momentum", "Nesterov", "Adam").contains(updaterName),
    s"unknown weights updater '$updaterName'")
  require(batchCapacity > 0, "batch size must be positive")

  private val nFeat = children.size - 1

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): StochasticRegressionAgg.Model =
    new StochasticRegressionAgg.Model(nFeat, isLogistic, learningRate, l2,
      batchCapacity, updaterName)

  override def update(
      m: StochasticRegressionAgg.Model, input: InternalRow): StochasticRegressionAgg.Model = {
    val vals = children.map(_.eval(input))
    if (!vals.contains(null)) {
      val d = vals.map(_.asInstanceOf[Number].doubleValue()).toArray
      m.add(d.head, d.tail)
    }
    m
  }

  override def merge(
      a: StochasticRegressionAgg.Model,
      b: StochasticRegressionAgg.Model): StochasticRegressionAgg.Model = {
    a.mergeFrom(b); a
  }

  override def eval(m: StochasticRegressionAgg.Model): Any =
    new GenericArrayData((m.weights :+ m.bias).map(java.lang.Double.valueOf))

  override def serialize(m: StochasticRegressionAgg.Model): Array[Byte] = m.write()

  override def deserialize(bytes: Array[Byte]): StochasticRegressionAgg.Model = {
    val m = createAggregationBuffer()
    m.read(bytes)
    m
  }

  override def withNewMutableAggBufferOffset(n: Int): StochasticRegressionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StochasticRegressionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String =
    if (isLogistic) "stochastic_logistic_regression" else "stochastic_linear_regression"
}

object StochasticRegressionAgg {

  /** LinearModelData + IWeightsUpdater state, mirrored field-for-field. */
  final class Model(
      nFeat: Int,
      isLogistic: Boolean,
      lr: Double,
      l2: Double,
      batchCapacity: Long,
      updater: String) extends Serializable {

    var weights: Array[Double] = Array.fill(nFeat)(0.0)
    var bias: Double = 0.0
    var iterNum: Long = 0L
    var gradientBatch: Array[Double] = Array.fill(nFeat + 1)(0.0)
    var batchSize: Long = 0L
    // Momentum / Nesterov
    var accumulated: Array[Double] = Array.empty
    // Adam
    var avgGrad: Array[Double] = Array.empty
    var avgSqGrad: Array[Double] = Array.empty
    var beta1Powered: Double = Beta1
    var beta2Powered: Double = Beta2

    private def computeGradient(
        target: Double, x: Array[Double], w: Array[Double], b: Double): Unit = {
      if (!isLogistic) {
        var d = target - b
        var i = 0
        while (i < nFeat) { d -= w(i) * x(i); i += 1 }
        d *= 2
        gradientBatch(nFeat) += d
        i = 0
        while (i < nFeat) { gradientBatch(i) += d * x(i) - 2 * l2 * w(i); i += 1 }
      } else {
        var z = b
        var i = 0
        while (i < nFeat) { z += w(i) * x(i); i += 1 }
        val e = math.exp(target * z)
        gradientBatch(nFeat) += target / (e + 1)
        i = 0
        while (i < nFeat) {
          gradientBatch(i) += target * x(i) / (e + 1) - 2 * l2 * w(i); i += 1
        }
      }
    }

    def add(target: Double, x: Array[Double]): Unit = {
      if (updater == "Nesterov") {
        // Nesterov::addToBatch — gradient at lookahead-shifted weights
        if (accumulated.isEmpty) accumulated = Array.fill(nFeat + 1)(0.0)
        val shifted = Array.tabulate(nFeat)(i => weights(i) + accumulated(i) * NesterovAlpha)
        computeGradient(target, x, shifted, bias + accumulated(nFeat) * NesterovAlpha)
      } else {
        if (updater == "Adam" && avgGrad.isEmpty) {
          avgGrad = Array.fill(nFeat + 1)(0.0)
          avgSqGrad = Array.fill(nFeat + 1)(0.0)
        }
        computeGradient(target, x, weights, bias)
      }
      batchSize += 1
      if (batchSize == batchCapacity) updateState()
    }

    def updateState(): Unit = {
      if (batchSize == 0) return
      updater match {
        case "SGD" =>
          var i = 0
          while (i < nFeat) {
            weights(i) += lr * gradientBatch(i) / batchSize; i += 1
          }
          bias += lr * gradientBatch(nFeat) / batchSize
        case "Momentum" | "Nesterov" =>
          val alpha = if (updater == "Momentum") MomentumAlpha else NesterovAlpha
          if (accumulated.isEmpty) accumulated = Array.fill(nFeat + 1)(0.0)
          var i = 0
          while (i <= nFeat) {
            accumulated(i) = accumulated(i) * alpha + lr * gradientBatch(i) / batchSize
            i += 1
          }
          i = 0
          while (i < nFeat) { weights(i) += accumulated(i); i += 1 }
          bias += accumulated(nFeat)
        case "Adam" =>
          if (avgGrad.isEmpty) {
            avgGrad = Array.fill(nFeat + 1)(0.0)
            avgSqGrad = Array.fill(nFeat + 1)(0.0)
          }
          var i = 0
          while (i <= nFeat) {
            val g = gradientBatch(i) / batchSize
            avgGrad(i) = Beta1 * avgGrad(i) + (1 - Beta1) * g
            avgSqGrad(i) = Beta2 * avgSqGrad(i) + (1 - Beta2) * g * g
            i += 1
          }
          i = 0
          while (i < nFeat) {
            weights(i) += lr * avgGrad(i) /
              ((1 - beta1Powered) * (math.sqrt(avgSqGrad(i) / (1 - beta2Powered)) + AdamEps))
            i += 1
          }
          bias += lr * avgGrad(nFeat) /
            ((1 - beta1Powered) * (math.sqrt(avgSqGrad(nFeat) / (1 - beta2Powered)) + AdamEps))
          beta1Powered *= Beta1
          beta2Powered *= Beta2
      }
      batchSize = 0
      iterNum += 1
      java.util.Arrays.fill(gradientBatch, 0.0)
    }

    def mergeFrom(rhs: Model): Unit = {
      if (iterNum == 0 && rhs.iterNum == 0) return
      updateState()
      val frac = (iterNum.toDouble * iterNum) /
        (iterNum.toDouble * iterNum + rhs.iterNum.toDouble * rhs.iterNum)
      var i = 0
      while (i < nFeat) {
        weights(i) = weights(i) * frac + rhs.weights(i) * (1 - frac); i += 1
      }
      bias = bias * frac + rhs.bias * (1 - frac)
      iterNum += rhs.iterNum
      // updater-state merges (Momentum/Nesterov blend accumulated;
      // Adam blends the moment estimates — Adam::merge)
      updater match {
        case "Momentum" | "Nesterov" =>
          if (rhs.accumulated.nonEmpty) {
            if (accumulated.isEmpty) accumulated = Array.fill(nFeat + 1)(0.0)
            var j = 0
            while (j <= nFeat) {
              accumulated(j) = accumulated(j) * frac + rhs.accumulated(j) * (1 - frac)
              j += 1
            }
          }
        case "Adam" =>
          if (rhs.avgGrad.nonEmpty) {
            if (avgGrad.isEmpty) {
              avgGrad = Array.fill(nFeat + 1)(0.0)
              avgSqGrad = Array.fill(nFeat + 1)(0.0)
            }
            var j = 0
            while (j <= nFeat) {
              avgGrad(j) = avgGrad(j) * frac + rhs.avgGrad(j) * (1 - frac)
              avgSqGrad(j) = avgSqGrad(j) * frac + rhs.avgSqGrad(j) * (1 - frac)
              j += 1
            }
            // Adam::merge blends only the moment estimates; the β-powers
            // stay the left state's, like the reference.
          }
        case _ => ()
      }
    }

    def write(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      def arr(a: Array[Double]): Unit = { out.writeInt(a.length); a.foreach(out.writeDouble) }
      out.writeDouble(bias); arr(weights); out.writeLong(iterNum)
      arr(gradientBatch); out.writeLong(batchSize)
      arr(accumulated); arr(avgGrad); arr(avgSqGrad)
      out.writeDouble(beta1Powered); out.writeDouble(beta2Powered)
      out.flush()
      bos.toByteArray
    }

    def read(bytes: Array[Byte]): Unit = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      def arr(): Array[Double] = Array.fill(in.readInt())(in.readDouble())
      bias = in.readDouble(); weights = arr(); iterNum = in.readLong()
      gradientBatch = arr(); batchSize = in.readLong()
      accumulated = arr(); avgGrad = arr(); avgSqGrad = arr()
      beta1Powered = in.readDouble(); beta2Powered = in.readDouble()
    }
  }

  val MomentumAlpha = 0.1
  val NesterovAlpha = 0.9
  val Beta1 = 0.9
  val Beta2 = 0.999
  val AdamEps = 0.000001
}
